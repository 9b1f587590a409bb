from apache_beam_spark.operators.elementwise import (
    Filter,
    FlatMap,
    Keys,
    KvSwap,
    Map,
    ParDo,
    Partition,
    Regex,
    Reshuffle,
    ToStringOp,
    Values,
    WithKeys,
)
from apache_beam_spark.operators.grouping import CoGroupByKey, GroupByKey, GroupIntoBatches
from apache_beam_spark.operators.combine import (
    ApproximateQuantiles,
    ApproximateUnique,
    Combine,
    CombineFn,
    Count,
    Distinct,
    Latest,
    Max,
    Mean,
    Min,
    Sample,
    Sum,
    Top,
)
from apache_beam_spark.operators.join import Join
from apache_beam_spark.operators.flatten import Flatten
from apache_beam_spark.operators.views import View

__all__ = [
    "Map", "FlatMap", "Filter", "ParDo", "Keys", "Values", "KvSwap",
    "WithKeys", "ToStringOp", "Regex", "Reshuffle", "Partition",
    "GroupByKey", "CoGroupByKey", "GroupIntoBatches",
    "Combine", "CombineFn", "Count", "Sum", "Min", "Max", "Mean", "Top",
    "Distinct", "Latest", "Sample", "ApproximateUnique", "ApproximateQuantiles",
    "Join", "Flatten", "View",
]
