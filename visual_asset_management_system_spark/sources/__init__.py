from .tpch import TPCH_TABLES, load_tables, register_views  # noqa: F401
from .vams import VAMS_VIEW_SQL, register_vams_views, oracle_with  # noqa: F401
