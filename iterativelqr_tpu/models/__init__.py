"""Model library: the reference's example problems plus extras, as problem builders."""

from . import acrobot, car, particle, pendulum, cartpole

__all__ = ["acrobot", "car", "particle", "pendulum", "cartpole"]
