"""Collect the data module's doctests inside the regular suite.

The reference ships sphinx-collected doctests in its data module
(reference data/__init__.py:13-19, docs/conf.py:18); CI additionally runs
them via ``pytest --doctest-modules`` — this test keeps them green in a
plain ``pytest tests/`` run too.
"""

import doctest

import periodicity_tpu.data as data_module


def test_data_module_doctests():
    results = doctest.testmod(data_module, verbose=False)
    assert results.attempted >= 7  # one example per loader/generator
    assert results.failed == 0
