from .synthetic import (SyntheticEventsDataSource, register_synthetic_source,
                        synthetic_agg_oracle_sql, synthetic_row_exprs)

__all__ = ["SyntheticEventsDataSource", "register_synthetic_source",
           "synthetic_agg_oracle_sql", "synthetic_row_exprs"]
