from .eav import metadata_map, pivot_metadata  # noqa: F401
from .search_tables import build_search_assets, build_search_files  # noqa: F401
from .graph import one_hop, descendants  # noqa: F401
from .versions import latest_versions, as_of  # noqa: F401
from .authz import compile_constraints  # noqa: F401
