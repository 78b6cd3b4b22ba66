SELECT DISTINCT o_orderkey, o_custkey
FROM orders
WHERE o_orderstatus != 'X'
