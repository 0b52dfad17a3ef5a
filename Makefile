# memex_tpu — build/test/bench entry points (reference has Makefile:1-30).

.PHONY: all native test bench serve clean

all: native

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q

bench:
	python bench.py

serve:
	python -m memex_tpu serve --roles Api,Worker

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache **/__pycache__
