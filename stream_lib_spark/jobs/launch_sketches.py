"""spark-submit entry file for the sketch CLI: the package itself ships
via ``--py-files stream_lib_spark.zip`` (so this file can be submitted
from anywhere); all logic lives in ``run_sketches.main``.

    spark-submit --master ... --py-files stream_lib_spark.zip \
        launch_sketches.py --input ... --ops hll:conv_id:p=14 ...
"""

from stream_lib_spark.jobs.run_sketches import main

if __name__ == "__main__":
    main()
