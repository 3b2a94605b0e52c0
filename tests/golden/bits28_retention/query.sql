-- bits28 days-seen build (reference udf/bits28 family): one bit per
-- active day-offset within the 28-day window
SELECT user_id,
       CAST(sum(CAST(pow(2, day_offset) AS BIGINT)) AS BIGINT) AS days_bits,
       count(*) AS days_active
FROM activity GROUP BY user_id
