"""Flatten (union) operators.

Reference: ``Flatten.pCollections()`` unions N PCollections;
``Flatten.iterables()`` flattens element iterables
(``transforms/Flatten.java:66,88``).
"""

from __future__ import annotations

from typing import Sequence, Union

from pyspark.sql import Column
from pyspark.sql import functions as F

from apache_beam_spark.pipeline import PCollection, PTransform


class Flatten:
    @staticmethod
    def pcollections(pcolls: Sequence[PCollection]) -> PCollection:
        """Union by name — a zero-shuffle narrow op in Spark."""
        assert pcolls
        df = pcolls[0].df
        for pc in pcolls[1:]:
            df = df.unionByName(pc.df)
        return pcolls[0]._with_df(df)

    @staticmethod
    def iterables(array_col: Union[str, Column], alias: str = "value") -> PTransform:
        class _FI(PTransform):
            def expand(self, pcoll: PCollection) -> PCollection:
                col = F.col(array_col) if isinstance(array_col, str) else array_col
                return pcoll._with_df(pcoll.df.select(F.explode(col).alias(alias)))

        return _FI()
