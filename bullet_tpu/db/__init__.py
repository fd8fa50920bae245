from .core import Bullet, BulletNode
from .crt import BulletCRT
from .middleware import BulletMiddleware
from .monitor import MonitorServer, StatusServer
from .query import BulletQuery
from .serializer import BulletSerializer
from .storage import BulletMemoryStorage, BulletStorage
from .validation import BulletValidation, ValidationError

__all__ = [
    "Bullet",
    "BulletNode",
    "BulletCRT",
    "BulletMiddleware",
    "BulletQuery",
    "BulletSerializer",
    "BulletMemoryStorage",
    "BulletStorage",
    "BulletValidation",
    "MonitorServer",
    "StatusServer",
    "ValidationError",
]
