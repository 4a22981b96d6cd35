"""Subpackage of gasket_rs_spark."""
