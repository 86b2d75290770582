from .compiler import SearchCompiler  # noqa: F401
from .metadata_query import compile_metadata_query  # noqa: F401
from .pagination import encode_page_token, decode_page_token, keyset_page  # noqa: F401
from .workflow import Pipeline, Workflow  # noqa: F401
