from .loader import Catalog, load_table, register_all
from .schemas import DOMAIN_SCHEMAS, TESTDATA_TABLES

__all__ = ["Catalog", "load_table", "register_all", "DOMAIN_SCHEMAS", "TESTDATA_TABLES"]
