from .maintenance import StreamingSampleMaintainer, StreamingTopKMaintainer
from .stateful import final_topk, stateful_space_saving

__all__ = ["StreamingSampleMaintainer", "StreamingTopKMaintainer",
           "stateful_space_saving", "final_topk"]
