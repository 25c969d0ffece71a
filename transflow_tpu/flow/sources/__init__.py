from .base import FlowItem, FlowSource

__all__ = ["FlowItem", "FlowSource"]
