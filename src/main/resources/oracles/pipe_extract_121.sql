SELECT * FROM (VALUES
(CAST('study' AS VARCHAR),CAST('Education' AS VARCHAR),CAST(202 AS BIGINT)),
('receive','Award',232),
('bear','Being_born',127),
('join','Work',975),
('die','Death',234),
('live','Residence',126),
('work','Occupation',96),
('marry','Marriage',116),
('raise','Parenting',112)
) AS t("lu","frame","n")