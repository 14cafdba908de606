from .readers import (read_binary, read_csv, read_excel, read_json,
                      read_orc, read_parquet, read_pipe, read_sniffed,
                      read_text, read_xml, smart_load)

__all__ = ["read_csv", "read_pipe", "read_excel", "read_json",
           "read_parquet", "read_orc", "read_text", "read_binary",
           "read_xml", "read_sniffed", "smart_load"]
