import pytest

from alstom_spark_cassandra_spark.session import get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", cpus=4, extra_conf={"spark.sql.shuffle.partitions": "4"})
    yield s
