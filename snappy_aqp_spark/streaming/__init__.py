from .maintenance import StreamingSampleMaintainer, StreamingTopKMaintainer

__all__ = ["StreamingSampleMaintainer", "StreamingTopKMaintainer"]
