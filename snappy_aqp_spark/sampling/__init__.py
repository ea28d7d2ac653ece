from .samplers import stratified_sample, create_sample_table
from .sql import sample_cte_stages

__all__ = ["stratified_sample", "create_sample_table", "sample_cte_stages"]
