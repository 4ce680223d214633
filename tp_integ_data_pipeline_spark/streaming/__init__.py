from tp_integ_data_pipeline_spark.streaming.ingest import (
    run_stream_to_memory,
    start_microbatch_ingest,
)
