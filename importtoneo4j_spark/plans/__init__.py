from importtoneo4j_spark.plans.pipeline import KGPipeline  # noqa: F401
