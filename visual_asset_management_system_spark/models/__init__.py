from .search import SearchFilter, SearchRequest, SortSpec  # noqa: F401
