"""Sources/sinks: table IO seam (parquet now, Iceberg by config) and
an OSM XML reader (reference load_osm, conflate.py:22-62)."""
