"""Operators: pure ``DataFrame -> DataFrame`` transforms.

Same composability contract as the reference's module functions
(``/root/reference/src/cleaning.py:4-9`` docstring contract): each function
is independently callable, guards on column presence, and never executes a
job on its own — plans stay lazy until the caller's action.
"""
