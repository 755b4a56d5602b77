from .distinct_on import distinct_on
from .joins import asof_join, range_join
from .recursive import recursive_cte
from .topk import top_k, top_k_per_group

__all__ = ["distinct_on", "asof_join", "range_join", "recursive_cte", "top_k", "top_k_per_group"]
