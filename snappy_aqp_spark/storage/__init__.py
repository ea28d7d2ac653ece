from .layout import (bucketed_tables, colocated_join_oracle_sql,
                     colocated_join_revenue, exchange_count,
                     partition_pruned_counts, partition_pruned_oracle_sql,
                     partitioned_files_read, pruned_scan, write_bucketed,
                     write_partitioned)

__all__ = ["bucketed_tables", "colocated_join_oracle_sql",
           "colocated_join_revenue", "exchange_count",
           "partition_pruned_counts", "partition_pruned_oracle_sql",
           "partitioned_files_read", "pruned_scan", "write_bucketed",
           "write_partitioned"]
