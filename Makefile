.PHONY: test lint native bench clean

test: native
	python -m pytest tests/ -q

lint:
	python -m flake8 mtscomp_tpu tests --max-line-length=100 || true

native:
	python -c "from mtscomp_tpu.native import build_library; build_library()"

bench:
	python bench.py

clean:
	rm -f mtscomp_tpu/native/libmtsnative.so
	find . -name __pycache__ -type d -exec rm -rf {} +
