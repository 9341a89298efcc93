SELECT * FROM (VALUES
(CAST('Education' AS VARCHAR),CAST('missing_core_fe' AS VARCHAR),CAST(98 AS BIGINT)),
('Work','no_subject',850),
('Award','no_subject',106),
('Death','bad_date',123)
) AS t("frame","reason","n")