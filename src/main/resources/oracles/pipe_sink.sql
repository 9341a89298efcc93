SELECT * FROM (VALUES
(CAST(6 AS INTEGER),CAST(108 AS BIGINT),CAST(1 AS BIGINT)),
(7,222,2),
(1,229,2),
(2,541,4),
(4,230,1),
(0,433,3)
) AS t("pred_bucket","n_rows","n_preds")