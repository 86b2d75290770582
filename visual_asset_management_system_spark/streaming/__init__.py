from .cdc import apply_cdc_batch, start_search_table_stream  # noqa: F401
