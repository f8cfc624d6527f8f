# One-command entry points (documented in README.md).

.PHONY: test test-all bench

# Full suite, each test file in its own subprocess: a single pytest process
# segfaults in XLA-CPU compilation after ~150 compilations on this image
# (tools/run_tests.py header).  Exit 0 == green.
test:
	python tools/run_tests.py

# Also run the opt-in design-point backend parity suites
# (render/wavefront.py, kernels/traversal.py — BASELINE.md sunset criteria).
test-all:
	python tools/run_tests.py --design-points

bench:
	python bench.py
