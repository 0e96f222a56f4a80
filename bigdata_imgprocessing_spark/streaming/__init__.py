from .jobs import event_stream

__all__ = ["event_stream"]
