"""Privacy-preserving release operators.

A curated corpus that ships outside the pipeline needs the standard
release gates next to the extraction/dedup tiers: k-anonymity suppression
(no quasi-identifier combination may isolate fewer than ``k`` rows — the
re-identification floor of Sweeney's model) is the first of them. The
reference engine has no analogue (it is a document toolkit); the operator
is part of the training-data-pipeline surface this repo adds on top
(README driver contract).

Scale shape: k-anonymity is a *group-size* predicate, so it needs the
group colocated exactly once — ONE hash exchange on the quasi-identifier
columns (``exchange.partition_map``), then a whole-partition vectorized
count-and-mask kernel (one pyarrow ``group_by`` + ``is_in``-free index
mapping, zero per-group Python). No join: the suppression happens in the
same partition that computed the counts, which is what makes it one
exchange instead of census + semi-join (two).
"""

from __future__ import annotations

import pyarrow as pa

from pypdfium2_ray.stages.exchange import partition_map


def k_anonymize(ds, quasi_keys: list[str], k: int,
                num_partitions: int | None = None):
    """Suppress every row whose quasi-identifier combination occurs fewer
    than ``k`` times in the WHOLE input (the k-anonymity release rule:
    any published row is indistinguishable from >= k-1 others on the
    quasi keys). Payload columns ride along untouched; output keeps the
    input schema.

    One hash exchange on ``quasi_keys``; each partition holds every row
    of each of its combinations, so a single vectorized group-count +
    row-mask suppresses locally. Equivalent SQL:
    ``QUALIFY count(*) OVER (PARTITION BY quasi_keys) >= k``.
    """
    import numpy as np
    import pandas as pd

    def kernel(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            return df
        gid = df.groupby(quasi_keys, sort=False).ngroup().to_numpy()
        counts = np.bincount(gid)
        return df[counts[gid] >= k]

    return partition_map(ds, quasi_keys, kernel, batch_format="pandas",
                         num_partitions=num_partitions)
