"""Stateless scalar / batch kernels shared by stages, oracle and tests."""
