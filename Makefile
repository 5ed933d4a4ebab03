PY ?= python

test:
	$(PY) -m pytest tests/ -x -q

bench:
	SPARK_GRAFT_SF_DIR=$${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.1} \
	SPARK_GRAFT_CPUS=$${SPARK_GRAFT_CPUS:-32} $(PY) bench.py

scaling:
	$(PY) scripts/scaling_bench.py --low 4 --reps 3 --write --json-out SCALING_r3.json

# spark-submit deployment artifact: zip the package for --py-files
dist/contessa_spark.zip: $(shell find contessa_spark -name '*.py')
	mkdir -p dist
	cd . && zip -qr dist/contessa_spark.zip contessa_spark -i '*.py'

zip: dist/contessa_spark.zip

pipeline-smoke: zip
	$(PY) scripts/run_pipeline.py --generate 2000 --base /tmp/cs_smoke --master 'local[8]'
	rm -rf /tmp/cs_smoke

.PHONY: test bench scaling zip pipeline-smoke
