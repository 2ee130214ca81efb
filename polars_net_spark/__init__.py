"""polars_net_spark — a PySpark-native analytics engine with the query surface
of ErrorLSC/Polars.NET (reference at /root/reference, see SURVEY.md).

Everything compiles to the Spark DataFrame API; Catalyst + AQE are the
optimizer and scheduler.  Public API mirrors the reference's `pl.*` module
(Polars.FSharp/Polars.fs:21-299) in Python idiom.
"""

from .exprs import (
    Expr,
    all_horizontal,
    any_horizontal,
    arctan2,
    as_struct,
    concat_list,
    coalesce,
    col,
    cols,
    concat_str,
    corr,
    cov,
    cum_fold,
    cum_reduce,
    fold,
    format,
    lit,
    lit_datetime,
    max_horizontal,
    mean_horizontal,
    min_horizontal,
    reduce,
    sum_horizontal,
    when,
)
from .frame import DataFrame, GroupBy, LazyFrame, concat
from .io import (
    date_range,
    datetime_range,
    int_range,
    from_arrow,
    from_batches,
    from_dict,
    from_dicts,
    from_pandas,
    from_records,
    read_csv,
    read_ipc,
    read_json,
    read_parquet,
    read_orc,
    register_callback_source,
    scan_batches,
    scan_csv,
    scan_ipc,
    scan_jdbc,
    scan_ndjson,
    scan_parquet,
    scan_orc,
    write_bucketed,
    read_table,
    repeat,
    from_numpy,
)
from . import pl_functions as _plf
from .pl_functions import (
    approx_n_unique,
    count,
    first,
    implode,
    last,
    mean,
    median,
    n_unique,
    quantile,
    std,
    struct,
    var,
)

# polars names that shadow Python builtins — bound explicitly so `pl.len()`
# / `pl.sum("x")` work without poisoning any module namespace
from .selectors import all_ as all  # noqa: A001 — polars pl.all() == every column
from .selectors import exclude

len = _plf.len  # noqa: A001
sum = _plf.sum  # noqa: A001
min = _plf.min  # noqa: A001
max = _plf.max  # noqa: A001
from ._cache import cached_count, release_caches, scoped_caches
from .series import Series
from .session import get_spark, stop_spark
from .sql import SQLContext, sql
from . import selectors as cs  # polars convention: `import polars.selectors as cs`
from . import testing  # polars convention: pl.testing.assert_frame_equal

__version__ = "0.1.0"

__all__ = [
    "Expr",
    "col",
    "cols",
    "lit",
    "lit_datetime",
    "when",
    "concat_str",
    "corr",
    "cov",
    "as_struct",
    "coalesce",
    "sum_horizontal",
    "mean_horizontal",
    "min_horizontal",
    "max_horizontal",
    "any_horizontal",
    "all_horizontal",
    "fold",
    "reduce",
    "cum_fold",
    "cum_reduce",
    "arctan2",
    "format",
    "concat_list",
    "DataFrame",
    "LazyFrame",
    "GroupBy",
    "concat",
    "Series",
    "SQLContext",
    "release_caches",
    "cached_count",
    "scoped_caches",
    "get_spark",
    "stop_spark",
    "cs",
    "scan_parquet",
    "len",
    "count",
    "sum",
    "mean",
    "median",
    "min",
    "max",
    "std",
    "var",
    "first",
    "last",
    "n_unique",
    "approx_n_unique",
    "implode",
    "quantile",
    "struct",
    "all",
    "exclude",
    "sql",
    "write_bucketed",
    "read_table",
    "repeat",
    "from_numpy",
    "int_range",
    "from_dict",
    "from_dicts",
    "datetime_range",
    "date_range",
    "read_parquet",
    "scan_orc",
    "read_orc",
    "scan_csv",
    "read_csv",
    "scan_ndjson",
    "scan_batches",
    "register_callback_source",
    "read_json",
    "read_ipc",
    "scan_ipc",
    "from_arrow",
    "from_batches",
    "from_pandas",
    "from_records",
    "scan_jdbc",
]
