"""Minimal picklable tasks for CompressService tests.

Lives in its own import-light module: spawn workers import the module
that defines a submitted callable, and pulling in the full test module
(conftest -> jax) inside every worker is slow and has deadlocked under
the 1-vCPU test harness.
"""


def sleep_task(seconds: float) -> str:
    import time

    time.sleep(seconds)
    return "slept"


def crash_task() -> None:
    import os

    os._exit(17)  # simulate a native crash inside the worker
