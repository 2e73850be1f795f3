# Convenience targets

.PHONY: test test-fast test-slow bench native entrycheck clean

# full suite (nightly scale: trainer loops + integration, >40 min on a
# single-core host)
test:
	python -m pytest tests/ -q

# the default development gate: everything not marked `slow`
# (ops golden tests, data plane, models, metrics, serving, registry)
test-fast:
	python -m pytest tests/ -q -m "not slow"

# only the long-running tier
test-slow:
	python -m pytest tests/ -q -m slow

bench:
	python bench.py

native:
	$(MAKE) -C native

entrycheck:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
		python __graft_entry__.py

clean:
	rm -rf runs plots eval .pytest_cache
	$(MAKE) -C native clean
