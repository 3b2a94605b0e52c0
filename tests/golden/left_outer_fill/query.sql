-- the reference's most common join form: LEFT OUTER preserving all left
-- rows with null-filled aggregates (baseline_clients_daily_v1:236-238)
SELECT c.cust_id, c.segment,
       COALESCE(a.n_orders, 0) AS n_orders,
       COALESCE(a.total, 0) AS total
FROM customers c
LEFT JOIN (SELECT cust_id, count(*) AS n_orders, sum(amount) AS total
           FROM orders GROUP BY cust_id) a
ON c.cust_id = a.cust_id
