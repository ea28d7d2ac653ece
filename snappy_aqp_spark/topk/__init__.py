from .api import TopKRegistry, create_approx_ts_topk, query_approx_ts_topk

__all__ = ["TopKRegistry", "create_approx_ts_topk", "query_approx_ts_topk"]
