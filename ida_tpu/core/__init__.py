from .state import IdaState, IdaOptions, init_state

__all__ = ["IdaState", "IdaOptions", "init_state"]
