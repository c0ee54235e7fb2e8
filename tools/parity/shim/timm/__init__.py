"""Minimal `timm` stand-in (timm is not installed in this environment).

Provides exactly the symbols the reference trackers import so their torch
model code can be instantiated on CPU for weight-conversion parity checks.
Numerics of the layers here (Mlp, DropPath in eval mode) match timm's
definitions; the init helpers only need to produce valid (not identical)
random weights, since parity is measured after converting the *actual*
instantiated weights.
"""
