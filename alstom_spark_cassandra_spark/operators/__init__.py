from .asof import asof_id_bounds, asof_snapshot_pair
from .json_flatten import flatten_json_value
from .latest import latest_per_key
from .locf import locf, locf_pivot
from .range_join import interval_join
from .setops import symmetric_diff_rows, unchanged_rows

__all__ = [
    "asof_id_bounds",
    "asof_snapshot_pair",
    "flatten_json_value",
    "interval_join",
    "latest_per_key",
    "locf",
    "locf_pivot",
    "symmetric_diff_rows",
    "unchanged_rows",
]
