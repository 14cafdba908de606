from .writers import (write_bucketed, write_csv, write_parquet,
                      write_partitioned)

__all__ = ["write_csv", "write_parquet", "write_partitioned",
           "write_bucketed"]
