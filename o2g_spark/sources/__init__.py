"""Sources: deterministic synthetic fixtures + table loaders.

The reference reads OSM XML extracts / the Overpass API (SURVEY.md §2.A
A1–A2 [o2g-PK]); here the inputs are columnar tables. ``synth`` builds
the north-rule `pages` table (BASELINE.json input_hint) plus `zones` /
`gazetteer` dimensions, bit-reproducibly (pure numpy, seed=42).
``tables`` loads the driver-provided parquet testdata.
"""
