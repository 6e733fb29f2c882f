"""Generate the golden fixtures in tests/golden/ (SURVEY.md §5 item 2).

Run once (committed outputs are the source of truth):

    python tools/make_goldens.py

* ``water_quality_slice.csv`` — a frozen slice of the reference's own
  replay dataset (/root/reference/kafka/sorted_water_quality.csv —
  public Irish-EPA monthly water-quality samples; data, not code):
  the three named waterbodies' full histories, order preserved.
* ``wqi_bands_golden.csv`` / ``anomaly_counts_golden.csv`` — expected
  analytics outputs computed with an INDEPENDENT pandas
  implementation of the engine's documented semantics
  (operators/river_pipeline.py::wqi_classify / flag_anomalies), so
  the golden test cross-checks Spark against a second implementation,
  not against itself.
"""

from __future__ import annotations

import os

import pandas as pd

REF_CSV = "/root/reference/kafka/sorted_water_quality.csv"
OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")
SENSORS = ["Ballinhassig East", "DARGLE_030", "CARRIGAHORIG STREAM_010"]


#: Inverse of the reference month map (kafka/sort_the_source.py:14-18)
#: — month number back to the abbreviated name the raw feed carries.
MONTH_ABBREV = {
    1: "Jan", 2: "Feb", 3: "Mar", 4: "Apr", 5: "May", 6: "Jun",
    7: "Jul", 8: "Aug", 9: "Sep", 10: "Oct", 11: "Nov", 12: "Dec",
}


def main() -> None:
    df = pd.read_csv(REF_CSV)
    sl = df[df["WaterbodyName"].isin(SENSORS)].reset_index(drop=True)
    sl.to_csv(os.path.join(OUT, "water_quality_slice.csv"), index=False)

    # Reference-shaped RAW input: invert the prep transform so the
    # golden suite can drive prep() end-to-end with the abbreviated
    # 'Jan'-style month names the real feed has (the raw upstream file
    # is absent from the reference snapshot, .MISSING_LARGE_BLOBS:1).
    # Measurement columns are kept as verbatim strings (dtype=str on
    # re-read) so no float re-formatting can drift the round trip.
    sl_str = pd.read_csv(os.path.join(OUT, "water_quality_slice.csv"), dtype=str)
    dates = pd.to_datetime(sl_str["FullDate"])
    raw = pd.DataFrame(
        {
            "SampleDate": dates.dt.month.map(MONTH_ABBREV),
            "Years": dates.dt.year.astype(str),
            "WaterbodyName": sl_str["WaterbodyName"],
            "pH": sl_str["pH"],
            "Dissolved Oxygen": sl_str["Dissolved Oxygen"],
            "Conductivity @25°C": sl_str["Conductivity @25°C"],
        }
    )
    # Shuffle deterministically: prep must re-derive the time order.
    raw = raw.sample(frac=1.0, random_state=7).reset_index(drop=True)
    raw.to_csv(os.path.join(OUT, "raw_reference_shaped.csv"), index=False)

    ph = sl["pH"].astype(float)
    do = sl["Dissolved Oxygen"].astype(float)
    tds = sl["Conductivity @25°C"].astype(float)
    viol = (
        ((ph < 6.5) | (ph > 8.5)).astype(int)
        + (do < 80.0).astype(int)
        + (tds > 1000.0).astype(int)
    )
    band = viol.map(lambda v: "good" if v == 0 else ("fair" if v == 1 else "poor"))
    bands = (
        pd.DataFrame({"sensor_id": sl["WaterbodyName"], "wqi_band": band})
        .groupby(["sensor_id", "wqi_band"])
        .size()
        .reset_index(name="n")
        .sort_values(["sensor_id", "wqi_band"])
    )
    bands.to_csv(os.path.join(OUT, "wqi_bands_golden.csv"), index=False)

    rows = []
    for sensor, g in sl.groupby("WaterbodyName"):
        n_anom = 0
        for col in ("pH", "Dissolved Oxygen", "Conductivity @25°C"):
            v = g[col].astype(float)
            sigma = v.std(ddof=1)  # stddev_samp
            if sigma and sigma > 0:
                n_anom += int((((v - v.mean()) / sigma).abs() > 3.0).sum())
        rows.append({"sensor_id": sensor, "n_anomalies": n_anom})
    pd.DataFrame(rows).sort_values("sensor_id").to_csv(
        os.path.join(OUT, "anomaly_counts_golden.csv"), index=False
    )
    print("golden fixtures written to", OUT)


if __name__ == "__main__":
    main()
