from importtoneo4j_spark.operators.extract import extract_assertions  # noqa: F401
