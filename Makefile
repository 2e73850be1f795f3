# Convenience targets

.PHONY: test bench native entrycheck clean

test:
	python -m pytest tests/ -q

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
