"""Reference-parity CLI surface: train_base / inference / test
(`python -m classification.<cmd>`, reference README.md:100,144,216)."""
