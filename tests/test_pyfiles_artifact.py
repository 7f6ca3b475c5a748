"""Deployment-contract smoke: the --py-files zip built by
scripts/build_pyfiles.sh must be importable ON ITS OWN (the cluster
executor / driver view: sys.path = [zip]) and run the KG pipeline
end to end — the spark-submit --py-files contract of the north rule.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import sys
zip_path = sys.argv[1]
# simulate the spark-submit --py-files view: the package resolves
# from the zip, NOT the repo checkout
sys.path = [p for p in sys.path if not p.rstrip("/").endswith("repo")]
sys.path.insert(0, zip_path)
import renard_spark
assert zip_path in renard_spark.__file__, renard_spark.__file__
from renard_spark.session import get_spark
from renard_spark import corpus, pipeline
spark = get_spark("pyfiles_smoke", cpus=2, shuffle_partitions=2)
# ship the zip to executors exactly as --py-files would
spark.sparkContext.addPyFile(zip_path)
docs = corpus.generate_documents(spark, 40, seed=3, partitions=4)
out = pipeline.character_graph_pipeline(docs, dist=(1, "sentences"))
n = out["triples"].count()
assert n > 0, n
print("PYFILES_OK", n)
"""


def test_pyfiles_zip_runs_pipeline():
    subprocess.run(
        ["sh", os.path.join(REPO, "scripts", "build_pyfiles.sh")],
        check=True, capture_output=True,
    )
    zip_path = os.path.join(REPO, "dist", "renard_spark.zip")
    assert os.path.exists(zip_path)
    r = subprocess.run(
        [sys.executable, "-c", CHILD, zip_path],
        capture_output=True, text=True, timeout=600,
    )
    assert "PYFILES_OK" in r.stdout, r.stdout + r.stderr
