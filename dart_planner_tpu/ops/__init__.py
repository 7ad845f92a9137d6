"""Numerical operators: SO(3)/SE(3) math, quadrotor dynamics, MPC costs,
and Pallas TPU kernels for the hot paths."""
