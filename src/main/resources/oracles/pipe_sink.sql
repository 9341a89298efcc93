SELECT * FROM (VALUES
(CAST(6 AS INTEGER),CAST(125 AS BIGINT),CAST(1 AS BIGINT)),
(7,243,2),
(1,126,1),
(2,539,4),
(4,239,1),
(0,230,2)
) AS t("pred_bucket","n_rows","n_preds")