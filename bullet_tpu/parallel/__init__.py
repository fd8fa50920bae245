from . import gossip, mesh, topology
from .topology import Topology

__all__ = ["gossip", "mesh", "topology", "Topology"]
