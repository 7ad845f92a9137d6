"""Core runtime: types, frames, vehicle parameters, config."""
