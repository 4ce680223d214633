from tp_integ_data_pipeline_spark.operators import dedup, joins, merge, multimodal, similarity, text
