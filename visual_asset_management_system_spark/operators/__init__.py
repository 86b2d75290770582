from .eav import (  # noqa: F401
    bulk_validation_tally,
    metadata_map,
    pivot_metadata,
    validate_metadata,
)
from .search_tables import build_search_assets, build_search_files  # noqa: F401
from .graph import (  # noqa: F401
    create_links,
    descendants,
    graph_export,
    link_auth_counts,
    one_hop,
)
from .versions import latest_versions, as_of  # noqa: F401
from .authz import compile_constraints  # noqa: F401
from .bucketing import read_table, write_bucketed_table  # noqa: F401
from .export import export_entities, export_manifest  # noqa: F401
from .reconcile import missing_in_storage, register_candidates  # noqa: F401
