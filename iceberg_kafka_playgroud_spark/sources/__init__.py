"""Sources (SURVEY §2.1): parquet lake scans live in ``schema.load_table``;
this package adds the synthetic event fabric (S5) and the Kafka+Avro
source/sink round-trip (S1/T1/T2, jar-gated)."""
