#!/bin/sh
# Build the --py-files artifact for cluster deployment (north_rule):
#   spark-submit --py-files dist/renard_spark.zip \
#       --deploy-mode cluster --num-executors N \
#       renard_spark/run.py --workdir s3://bucket/kg --input <table>
# The zip contains only the package (no tests, no caches); run.py is
# importable from it as `python -m renard_spark.run` on the driver.
set -e
cd "$(dirname "$0")/.."
mkdir -p dist
rm -f dist/renard_spark.zip
zip -qr dist/renard_spark.zip renard_spark -x '*__pycache__*'
unzip -l dist/renard_spark.zip | tail -1
echo "dist/renard_spark.zip ready"
