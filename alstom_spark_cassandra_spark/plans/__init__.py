from .queries import (
    Arguments,
    backup,
    get_message,
    get_multiple_fields,
    get_multiple_fields_history,
    get_update_history,
    get_update_history_chunked,
    make_arguments,
    retrieve_field,
    retrieve_message,
)

__all__ = [
    "Arguments",
    "make_arguments",
    "backup",
    "get_message",
    "get_multiple_fields",
    "get_multiple_fields_history",
    "get_update_history",
    "get_update_history_chunked",
    "retrieve_field",
    "retrieve_message",
]
