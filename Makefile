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

# Download the real embedding model (reference Makefile:22-28 downloads
# example LLM weights the same way). Air-gapped hosts: place an HF-format
# checkpoint at models/all-MiniLM-L12-v2 manually instead.
setup-examples:
	python -m memex_tpu download-model
	@echo "export EMBEDDING_MODEL=models/all-MiniLM-L12-v2"

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
	find . -name __pycache__ -type d -prune -exec rm -rf {} +
