from .tree import tree_where, masked_while_loop

__all__ = ["tree_where", "masked_while_loop"]
