"""Shared test utilities."""

from svpc_tpu.data.synthetic import synthetic_batch  # noqa: F401
