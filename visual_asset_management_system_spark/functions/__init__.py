from .normalize import (  # noqa: F401
    sanitize_field_name,
    coerce_boolean,
    coerce_number,
    composite_key,
    split_composite_key,
    file_extension,
    is_folder,
)
from .scoring import text_match_score, wildcard_to_like  # noqa: F401
