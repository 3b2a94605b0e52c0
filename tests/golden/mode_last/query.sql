-- stats.mode_last semantics (reference sql/mozfun/stats/mode_last):
-- most frequent value, ties broken by latest occurrence
WITH counted AS (
  SELECT user_id, val, count(*) AS n, max(seq) AS last_seq
  FROM events GROUP BY user_id, val)
SELECT user_id, val FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY n DESC, last_seq DESC) AS rn
  FROM counted)
WHERE rn = 1
