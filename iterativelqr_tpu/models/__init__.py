"""Model library: the reference's example problems plus extras, as problem builders."""

from . import acrobot, car, cartpole, particle, pendulum, quadrotor

__all__ = ["acrobot", "car", "particle", "pendulum", "cartpole", "quadrotor"]
