# Convenience targets (the reference's root Makefile builds one binary;
# here the "binary" is the Python package + native library).

.PHONY: all native test selftest smoke bench clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

selftest: native
	python3 -m rtlsdr_ft8d_tpu.host.cli -t

smoke: native
	python3 scripts/tpu_smoke.py

bench: native
	python3 bench.py

clean:
	$(MAKE) -C native clean 2>/dev/null || rm -f native/libft8tpu.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
