"""Reference-parity partitioning CLIs: create_cells / assign_classes
(reference README.md:225, 211)."""
