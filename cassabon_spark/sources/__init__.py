from cassabon_spark.sources.tables import load_table, load_all
from cassabon_spark.sources.carbon import parse_carbon_lines

__all__ = ["load_table", "load_all", "parse_carbon_lines"]
