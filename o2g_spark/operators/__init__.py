"""Spatial + training-data operators, composed from DataFrame primitives.

Each operator is a function DataFrame → DataFrame so Catalyst keeps
optimizing across operator boundaries (predicate pushdown through the
cover join, AQE at every shuffle). Custom logic exists only where
Catalyst has no primitive (SURVEY.md §4.3): cover precomputation,
ray-cast refine, the iterative kNN driver loop, salting policy.
"""
