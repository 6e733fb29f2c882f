"""Array-expression helpers shared across plans.

The one that matters: :func:`explode_nonempty`, a drop-in for
``F.explode`` over *computed* arrays that sidesteps a Catalyst
pathology measured at 26× on the bench corpus.

The pathology (Spark 3.1+ / 4.x, rule ``InferFiltersFromGenerate``):
for a non-outer ``Generate explode(e)``, the optimizer inserts
``Filter (size(e) > 0 AND isnotnull(e))`` *below* the generate so
empty arrays don't reach it. When ``e`` is a computed expression
(tokenize → shingle → array_distinct …), projection collapse inlines
the entire expression into BOTH filter conjuncts — and into every
`element_at` inside it — so each input row evaluates the array
pipeline ~2× extra, with its subexpressions re-evaluated per element.
For a 5-gram shingle expression this measured 15.1 s where the
explode itself costs 0.58 s (250k rows, sf0.1).

``explode_outer`` is exempt from the rule. When the caller can prove
the array is non-empty (every call site here filters on a size
precondition first, or explodes a split()/sequence() that yields ≥1
element by construction), outer vs inner explode produce identical
rows — so the swap is free semantically and removes the recompute.

At 100 TB the same rewrite is the difference between a scan-speed
explode stage and one that re-tokenizes the corpus three times.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def explode_nonempty(arr: Column | str) -> Column:
    """``F.explode`` for arrays the caller guarantees are non-NULL and
    non-empty. Emits exactly one row per element (same as explode);
    formulated as explode_outer so ``InferFiltersFromGenerate`` does
    not duplicate the array expression into an inferred filter.

    Caller contract: the array really is non-empty — an empty/NULL
    array would emit one NULL-element row instead of zero rows.
    """
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.explode_outer(c)
