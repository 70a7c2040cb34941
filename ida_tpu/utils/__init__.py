from .tree import tree_where, masked_while_loop, take1, take_row, set_row, set1

__all__ = ["tree_where", "masked_while_loop", "take1", "take_row", "set_row", "set1"]
