from tp_integ_data_pipeline_spark.functions.reference import (
    date_ddmmyyyy,
    format_postcodes,
    hpa_to_mmhg,
    int_to_bool,
    none_to_null,
    partition_date,
    shift_gmt3,
    time_hhmm,
    to_timestamp_iso,
    wind_cardinal,
    wind_cardinal_sql,
)
