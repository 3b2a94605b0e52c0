-- gap-based sessionization (events_daily session encoding family)
WITH flagged AS (
  SELECT user_id, event_id, sec,
         CASE WHEN sec - lag(sec) OVER (PARTITION BY user_id
                                        ORDER BY event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events),
sess AS (
  SELECT user_id, event_id,
         sum(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged)
SELECT user_id, session_id, count(*) AS n_events
FROM sess GROUP BY user_id, session_id
