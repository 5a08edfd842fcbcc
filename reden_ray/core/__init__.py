"""Pure-Python core semantics (no Ray imports).

These functions pin the reference behavior before any distribution; the
Ray stages in ``reden_ray.stages`` call them inside ``map_batches`` /
``map_groups`` UDFs.
"""
