from . import marts, relational

__all__ = ["marts", "relational"]
