"""Scalar-function catalog: the reference's deterministic normalizer
(reference src/validator.py:389-945) as pure Spark column expressions."""
