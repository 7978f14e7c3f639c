# Convenience targets (the reference exposes `make simple_test`,
# CMakeLists.txt:104-116; these are the equivalents)

.PHONY: native test simple_test bench clean

native:
	g++ -O3 -shared -fPIC megahit_tpu/native/fastxpack.cpp \
	    -o megahit_tpu/native/libfastxpack.so

test:
	python -m pytest tests/ -q

simple_test:
	rm -rf /tmp/megahit_tpu_simple_test
	python -m megahit_tpu --test -o /tmp/megahit_tpu_simple_test
	python -m megahit_tpu --test -o /tmp/megahit_tpu_simple_test_nl --no-local --no-mercy
	python -m megahit_tpu.tools readstat \
	    /tmp/megahit_tpu_simple_test/test_data/test_r1.fa.gz
	python -m megahit_tpu.tools contig2fastg 79 \
	    /tmp/megahit_tpu_simple_test/final.contigs.fa > /dev/null
	cat /tmp/megahit_tpu_simple_test/final.contigs.fa | \
	    python -m megahit_tpu.tools filterbylen 200 > /dev/null

bench:
	python bench.py

clean:
	rm -f megahit_tpu/native/libfastxpack.so
