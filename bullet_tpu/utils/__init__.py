from . import encode, jsvalues, paths
from .paths import PathInterner
from .encode import ValueInterner

__all__ = ["encode", "jsvalues", "paths", "PathInterner", "ValueInterner"]
