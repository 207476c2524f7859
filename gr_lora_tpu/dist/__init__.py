"""Multi-chip distribution: device meshes, halo exchange, gateway receiver."""

from .gateway import GatewayPlan, make_gateway, make_mesh

__all__ = ["GatewayPlan", "make_gateway", "make_mesh"]
