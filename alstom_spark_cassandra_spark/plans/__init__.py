from .queries import (
    backup,
    get_message,
    get_multiple_fields,
    get_update_history,
    retrieve_field,
    retrieve_message,
)

__all__ = [
    "backup",
    "get_message",
    "get_multiple_fields",
    "get_update_history",
    "retrieve_field",
    "retrieve_message",
]
