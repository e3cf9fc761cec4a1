"""Sources: synthetic webtext generator + adapters from the driver-provided
parquet tables (/root/testdata) to the north-rule pages schema."""
