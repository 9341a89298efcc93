SELECT * FROM (VALUES
(CAST(2 AS BIGINT),CAST(10 AS BIGINT),CAST(6 AS BIGINT),CAST(0.6 AS DOUBLE)),
(3,10,10,1.0),
(4,10,8,0.8),
(0,10,8,0.8),
(1,10,10,1.0)
) AS t("query_id","n_exact","n_hit","recall")