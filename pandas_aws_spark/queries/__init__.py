"""Named query corpus registered into :mod:`pandas_aws_spark.registry`.

Each module covers one slice of SURVEY.md §2's operator inventory plus
the north-star extension operators. Import via ``registry.load_registry()``.
"""
