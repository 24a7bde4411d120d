"""Query-side and training-data-pipeline operators, all declarative
DataFrame compositions (Catalyst-optimizable) with pandas-UDF kernels only
where built-ins genuinely cannot express the semantics."""
