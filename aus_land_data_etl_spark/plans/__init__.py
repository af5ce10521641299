"""Query plans: the driver-facing operator inventory and derive DAG."""
