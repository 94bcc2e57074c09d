"""Test-only stand-in for the external `urdf_parser_py` package.

This exists SOLELY so that `tests/test_vs_reference.py` can import and run
the upstream reference implementation (/root/reference, which depends on
urdf_parser_py) as an author-independent oracle on hosts where the real
package is not installed. It is inserted into sys.path by that test module
only — it is not part of the framework and nothing in
differentiable_robot_model_tpu imports it.
"""
