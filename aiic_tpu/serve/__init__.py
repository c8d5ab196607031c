from aiic_tpu.serve.db import InMemoryDB, connect_db, seed_demo_data
from aiic_tpu.serve.worker import ApartmentWorker, process_apartments_pipeline
from aiic_tpu.serve.batcher import DynamicBatcher
from aiic_tpu.serve.rest import make_server

__all__ = [
    "InMemoryDB",
    "connect_db",
    "seed_demo_data",
    "ApartmentWorker",
    "process_apartments_pipeline",
    "DynamicBatcher",
    "make_server",
]
