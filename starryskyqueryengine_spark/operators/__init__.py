from .topk import top_k, keyset_page, encode_cursor, parse_cursor, prepend_pinned  # noqa: F401
from .retention import retain_latest, refresh_delete  # noqa: F401
from .dedup import new_rows_anti_join  # noqa: F401
from .lookup import with_author_profiles  # noqa: F401
