from .readers import (read_csv, read_excel, read_json, read_parquet,
                      read_pipe, read_sniffed, smart_load)

__all__ = ["read_csv", "read_pipe", "read_excel", "read_json",
           "read_parquet", "read_sniffed", "smart_load"]
